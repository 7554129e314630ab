-- TPC-DS q12 (public benchmark query text, as carried by the
-- reference at testdata/workloads/tpcds/queries/tpcds-decimal_v2-q12.test)
select  i_item_id
      ,i_item_desc
      ,i_category
      ,i_class
      ,i_current_price
      ,sum(ws_ext_sales_price) as itemrevenue
      ,cast(sum(ws_ext_sales_price) as double)*100/cast(sum(sum(ws_ext_sales_price)) over
          (partition by i_class) as double) as revenueratio
from
  web_sales
      ,item
      ,date_dim
where
  ws_item_sk = i_item_sk
    and i_category in ('Sports', 'Books', 'Home')
    and ws_sold_date_sk = d_date_sk
  and cast(d_date as timestamp) between cast('1999-02-22' as timestamp)
        and (cast('1999-02-22' as timestamp) + interval 30 days)
group by
  i_item_id
        ,i_item_desc
        ,i_category
        ,i_class
        ,i_current_price
order by
  i_category
        ,i_class
        ,i_item_id
        ,i_item_desc
        ,revenueratio
limit 100
